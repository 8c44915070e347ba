PREFIX ex: <http://ex/>
DELETE DATA { ex:b ex:name "Bob" }
